<?xml version="1.0" encoding="UTF-8"?>
<gml:FeatureCollection
    xmlns:gml="http://www.opengis.net/gml"
    xmlns:app="http://example.com/app">
  <gml:featureMember>
    <app:Building gml:id="bld.1">
      <app:name>City Hall</app:name>
      <app:height>42.5</app:height>
      <app:geom>
        <gml:Polygon srsName="urn:ogc:def:crs:EPSG::4326">
          <gml:exterior>
            <gml:LinearRing>
              <gml:posList>0.0 0.0 4.0 0.0 4.0 3.0 0.0 3.0 0.0 0.0</gml:posList>
            </gml:LinearRing>
          </gml:exterior>
          <gml:interior>
            <gml:LinearRing>
              <gml:posList>1.0 1.0 2.0 1.0 2.0 2.0 1.0 2.0 1.0 1.0</gml:posList>
            </gml:LinearRing>
          </gml:interior>
        </gml:Polygon>
      </app:geom>
    </app:Building>
  </gml:featureMember>
  <gml:featureMember>
    <app:Road fid="road.7">
      <app:name>High Street</app:name>
      <app:lanes>2</app:lanes>
      <app:geom>
        <gml:LineString srsName="EPSG:4326">
          <gml:posList srsDimension="3">10.0 20.0 1.5 11.0 21.0 2.5 12.0 22.5 3.5</gml:posList>
        </gml:LineString>
      </app:geom>
    </app:Road>
  </gml:featureMember>
  <gml:featureMembers>
    <app:Station gml:id="st.1">
      <app:name>North</app:name>
      <app:geom>
        <gml:Point srsName="http://www.opengis.net/def/crs/EPSG/0/3857">
          <gml:pos>100.5 200.25</gml:pos>
        </gml:Point>
      </app:geom>
    </app:Station>
    <app:Station gml:id="st.2">
      <app:name>South</app:name>
      <app:geom>
        <gml:Point>
          <gml:pos>101.5 199.75</gml:pos>
        </gml:Point>
      </app:geom>
    </app:Station>
  </gml:featureMembers>
  <gml:featureMember>
    <app:Zone fid="zone.3">
      <app:name>Old Town</app:name>
      <app:geom>
        <gml:Polygon srsName="EPSG:4326">
          <gml:outerBoundaryIs>
            <gml:LinearRing>
              <gml:coordinates>5,5 9,5 9,9 5,9 5,5</gml:coordinates>
            </gml:LinearRing>
          </gml:outerBoundaryIs>
        </gml:Polygon>
      </app:geom>
    </app:Zone>
  </gml:featureMember>
  <gml:featureMember>
    <app:Park gml:id="park.9">
      <app:name>Twin Greens</app:name>
      <app:geom>
        <gml:MultiSurface srsName="EPSG:4326">
          <gml:surfaceMember>
            <gml:Polygon>
              <gml:exterior>
                <gml:LinearRing>
                  <gml:posList>30.0 30.0 32.0 30.0 32.0 31.0 30.0 31.0 30.0 30.0</gml:posList>
                </gml:LinearRing>
              </gml:exterior>
            </gml:Polygon>
          </gml:surfaceMember>
          <gml:surfaceMember>
            <gml:Polygon>
              <gml:exterior>
                <gml:LinearRing>
                  <gml:posList>35.0 30.0 36.0 30.0 36.0 32.0 35.0 32.0 35.0 30.0</gml:posList>
                </gml:LinearRing>
              </gml:exterior>
            </gml:Polygon>
          </gml:surfaceMember>
        </gml:MultiSurface>
      </app:geom>
    </app:Park>
  </gml:featureMember>
  <gml:featureMember>
    <app:River gml:id="rv.4">
      <app:name>Quiet Run</app:name>
      <app:geom>
        <gml:Curve srsName="EPSG:4326">
          <gml:segments>
            <gml:LineStringSegment>
              <gml:posList>50.0 50.0 51.0 50.5 52.0 51.0</gml:posList>
            </gml:LineStringSegment>
            <gml:LineStringSegment>
              <gml:posList>52.0 51.0 53.0 52.0</gml:posList>
            </gml:LineStringSegment>
          </gml:segments>
        </gml:Curve>
      </app:geom>
    </app:River>
  </gml:featureMember>
</gml:FeatureCollection>
